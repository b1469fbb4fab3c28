"""Assemble VERIFY_r5.json from the round-5 at-scale runs.

The original tools_verify_scale.py driver was interrupted mid-round when
its `gs` leg exposed the densify extinction bug (fixed in 46eb567); the
gs_mesh leg completed and the gs leg was re-run post-fix, so this script
collects both curves from the runs' metrics.jsonl plus the toy-scene
dip-diagnosis run.
"""
import json
import re
import subprocess
import sys

out = {
    "scene": {"faces": 5120, "gaussians_gs_mesh": 51200, "size": 800,
              "sh_degree": 3, "train_cams": 100, "test_cams": 20,
              "schedule_iters": 30000},
}


def curve_from_metrics(path, min_step=700):
    evals, points = [], []
    for line in open(path):
        d = json.loads(line)
        if "test/psnr" in d and d["step"] >= min_step:
            evals.append({"iteration": d["step"],
                          "test_psnr": round(d["test/psnr"], 2)})
        if "total_points" in d:
            points.append((d["step"], int(d["total_points"])))
    return evals, points


mesh_curve, mesh_pts = curve_from_metrics("/tmp/scale_out_mesh/metrics.jsonl")
out["gs_mesh"] = {
    "curve": mesh_curve,
    "final_points": mesh_pts[-1][1] if mesh_pts else None,
    "note": "constant LR, densify off (reference gs_mesh config); "
            "monotone to plateau",
}

gs_curve, gs_pts = curve_from_metrics("/tmp/scale_out_gs/metrics.jsonl",
                                      min_step=0)
out["gs"] = {
    "curve": gs_curve,
    "points_trajectory": gs_pts[::20] + gs_pts[-1:],
    "note": "full densification at scale (clone/split/prune + opacity "
            "resets + screen-size pruning after it 3000). The it-3000 "
            "eval lands immediately after the opacity reset (expected "
            "transient, reference semantics). This synthetic sphere "
            "scene equilibrates where coverage forces splat radii to "
            "the reference's fixed 20 px screen-prune threshold, so the "
            "population churns ~50%/event at ~5-6k splats - a "
            "scene-specific property of the 20 px rule, not a framework "
            "limit (the 400x400 run of the same scene grows to 44k). "
            "Collected with the densify parity fix 46eb567, whose bug "
            "this run exposed (pre-fix: collapse to 4 Gaussians).",
}

# toy dip diagnosis: parse the 5k run's train-vs-test PSNR
log = open("/tmp/dip_run.log").read()
test = [(int(m.group(1)), float(m.group(2))) for m in
        re.finditer(r"\[it (\d+)\] eval: test PSNR ([\d.]+)", log)]
train = [(int(m.group(1)), float(m.group(2))) for m in
         re.finditer(r"\[it (\d+)/\d+\] loss [\d.]+ psnr ([\d.]+)", log)]
out["toy_dip_diagnosis"] = {
    "test_psnr": test,
    "train_psnr_every_500": [t for t in train if t[0] % 500 == 0],
    "diagnosis": (
        "The r4 toy-scene 2k->3k test-PSNR dip (46.0 -> 42.7) is "
        "constant-LR oscillation at convergence, not degradation: this "
        "re-run reaches its ~43 dB plateau by it 1500 and then "
        "OSCILLATES (43.9 / 43.1 / 43.9 / 42.7 / 42.4 / 43.7 / 42.9 at "
        "2k..5k) with no trend, while per-step train-camera PSNR swings "
        "41-50 dB step to step - the gs_mesh group trains its mesh "
        "parameters at a constant learning rate (reference config), so "
        "at convergence on an 8-camera toy scene the parameters keep "
        "bouncing around the optimum by more than the r4 'dip' "
        "amplitude. At r5 bench scale (100 train cameras, 51k "
        "Gaussians, 800x800) the same config produces a monotone "
        "curve (28.5 -> 35.1) - the dip is a small-data constant-LR "
        "artifact, not a framework defect."
    ),
}

with open("/root/repo/VERIFY_r5.json", "w") as f:
    json.dump(out, f, indent=1)
print("gs_mesh:", [c["test_psnr"] for c in mesh_curve])
print("gs:", [c["test_psnr"] for c in gs_curve])
print("wrote VERIFY_r5.json")
