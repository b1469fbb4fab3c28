import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.models import flat, vanilla
import pytest

from gaussian_mesh_splatting_tpu.train import (
    densify_and_prune,
    grow_capacity,
    make_train_state,
    optimization_config,
    reset_opacity,
)

pytestmark = pytest.mark.slow  # many recompiles at distinct capacities (~4 min)


def _state_with_capacity(n=8, capacity=32, gs_type="gs", key=jax.random.key(0)):
    mod = vanilla if gs_type == "gs" else flat
    pts = jax.random.normal(key, (n, 3)) * 0.5
    cols = jnp.full((n, 3), 0.5)
    mstate = mod.init_from_points(pts, cols, sh_degree=1, capacity=capacity)
    cfg = optimization_config(gs_type)
    return make_train_state(gs_type, mstate, cfg) + (cfg,)


def test_clone_small_high_grad_gaussians():
    tstate, tx, cfg = _state_with_capacity()
    # mark rows 0..3 as high-gradient; their scales are small -> clones
    stats = tstate.stats
    ga = stats.grad_accum.at[:4].set(1.0)
    dn = stats.denom.at[:4].set(1.0)
    tstate = tstate.replace(stats=stats.replace(grad_accum=ga, denom=dn))
    new_state, info = densify_and_prune(
        tstate, jax.random.key(1),
        grad_threshold=2e-4, min_opacity=0.005, extent=1e6,  # huge extent => all "small"
        percent_dense=0.01, size_threshold=0.0, scaling_cols=3,
    )
    assert int(info["n_clone"]) == 4
    assert int(info["n_split_rows"]) == 0
    assert int(info["n_alive"]) == 12
    # cloned rows are exact copies of hot rows
    new_p = new_state.params
    xyz = np.asarray(new_p["xyz"])
    alive = np.asarray(new_state.alive)
    orig = np.asarray(tstate.params["xyz"][:4])
    clones = xyz[8:32][alive[8:32]]
    assert clones.shape == (4, 3)
    for row in clones:
        assert np.min(np.linalg.norm(orig - row, axis=1)) < 1e-6


def test_split_large_high_grad_gaussians():
    tstate, tx, cfg = _state_with_capacity()
    stats = tstate.stats
    ga = stats.grad_accum.at[:2].set(1.0)
    dn = stats.denom.at[:2].set(1.0)
    tstate = tstate.replace(stats=stats.replace(grad_accum=ga, denom=dn))
    # tiny extent => every hot row counts as "large" -> split
    new_state, info = densify_and_prune(
        tstate, jax.random.key(2),
        grad_threshold=2e-4, min_opacity=0.005, extent=1e-6,
        percent_dense=0.01, size_threshold=0.0, scaling_cols=3,
    )
    assert int(info["n_split_rows"]) == 4  # 2 rows x 2 samples
    # originals pruned: 8 - 2 + 4 = 10 alive
    assert int(info["n_alive"]) == 10
    # children fill freed slots (split originals' rows 0,1) then fresh rows
    # (8,9); each child's scale is a split source's scale / 1.6
    sc_old = np.exp(np.asarray(tstate.params["scaling"][:2]))
    sc_new = np.exp(np.asarray(new_state.params["scaling"]))
    child_rows = [0, 1, 8, 9]
    assert np.all(np.asarray(new_state.alive)[child_rows])
    expected = set(np.round(sc_old.max(-1) / 1.6, 5))
    got = set(np.round(sc_new[child_rows].max(-1), 5))
    assert got == expected, (got, expected)


def test_prune_low_opacity():
    tstate, tx, cfg = _state_with_capacity()
    p = tstate.params
    from gaussian_mesh_splatting_tpu.core.transforms import inverse_sigmoid

    op = p["opacity"].at[:3].set(inverse_sigmoid(jnp.asarray(0.001)))
    tstate = tstate.replace(params=dict(p, opacity=op))
    new_state, info = densify_and_prune(
        tstate, jax.random.key(3),
        grad_threshold=2e-4, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, size_threshold=0.0, scaling_cols=3,
    )
    assert int(info["n_alive"]) == 5
    assert not bool(new_state.alive[0])


def test_opacity_reset():
    tstate, tx, cfg = _state_with_capacity()
    new_state = reset_opacity(tstate)
    op = np.asarray(jax.nn.sigmoid(new_state.params["opacity"]))[np.asarray(tstate.alive)]
    np.testing.assert_allclose(op, 0.01, atol=1e-5)


def test_optimizer_moments_follow_rows():
    """After a clone event, surviving rows keep their Adam moments and new
    rows start at zero (gaussian_model.py:318-338)."""
    import optax

    tstate, tx, cfg = _state_with_capacity()
    # take a couple of steps to build nonzero moments
    g = jax.tree.map(jnp.ones_like, tstate.params)
    for _ in range(2):
        updates, opt_state = tx.update(g, tstate.opt_state, tstate.params)
        tstate = tstate.replace(
            params=optax.apply_updates(tstate.params, updates), opt_state=opt_state
        )
    stats = tstate.stats
    tstate = tstate.replace(
        stats=stats.replace(
            grad_accum=stats.grad_accum.at[0].set(1.0), denom=stats.denom.at[0].set(1.0)
        )
    )
    new_state, info = densify_and_prune(
        tstate, jax.random.key(4),
        grad_threshold=2e-4, min_opacity=0.005, extent=1e6,
        percent_dense=0.01, size_threshold=0.0, scaling_cols=3,
    )
    assert int(info["n_clone"]) == 1

    mus_old = [l for l in jax.tree.leaves(tstate.opt_state) if hasattr(l, "shape") and l.ndim > 0 and l.shape[0] == 32]
    mus_new = [l for l in jax.tree.leaves(new_state.opt_state) if hasattr(l, "shape") and l.ndim > 0 and l.shape[0] == 32]
    assert mus_old and len(mus_old) == len(mus_new)
    for old, new in zip(mus_old, mus_new):
        # surviving rows preserved
        np.testing.assert_allclose(np.asarray(new[:8]), np.asarray(old[:8]))
        # the cloned row's moments are zero
        clone_row = int(np.argmax(np.asarray(new_state.alive)[8:])) + 8
        np.testing.assert_allclose(np.asarray(new[clone_row]), 0.0)


def test_capacity_overflow_drops_candidates():
    tstate, tx, cfg = _state_with_capacity(n=30, capacity=32)
    stats = tstate.stats
    tstate = tstate.replace(
        stats=stats.replace(
            grad_accum=stats.grad_accum.at[:30].set(1.0),
            denom=stats.denom.at[:30].set(1.0),
        )
    )
    new_state, info = densify_and_prune(
        tstate, jax.random.key(5),
        grad_threshold=2e-4, min_opacity=0.005, extent=1e6,
        percent_dense=0.01, size_threshold=0.0, scaling_cols=3,
    )
    assert int(info["n_alive"]) == 32  # filled to capacity, no more
    assert int(info["overflow"]) > 0


def test_grow_capacity_preserves_rows():
    tstate, tx, cfg = _state_with_capacity(n=8, capacity=16)
    grown = grow_capacity(tstate, tx, 64)
    assert grown.alive.shape[0] == 64
    assert int(grown.alive.sum()) == 8
    np.testing.assert_allclose(
        np.asarray(grown.params["xyz"][:16]), np.asarray(tstate.params["xyz"])
    )
    # grown state still steps
    import optax

    g = jax.tree.map(jnp.ones_like, grown.params)
    updates, _ = tx.update(g, tx.init(grown.params), grown.params)
    optax.apply_updates(grown.params, updates)


def test_screen_size_pruned_rows_still_densify():
    """Reference parity: a Gaussian pruned for SCREEN SIZE (max_radii2D >
    size_threshold) must still clone/split when its gradient is hot — in
    the reference its children survive the same-pass prune because
    densification_postfix zeroes max_radii2D and split children carry
    scale/1.6 (gaussian_model.py:369-374, 400-412). Excluding size-pruned
    rows from densification caused a population extinction at 800x800
    scale (round-5 at-scale run: 47k -> 4 Gaussians after the iteration-
    3000 opacity reset enabled size pruning)."""
    tstate, tx, cfg = _state_with_capacity()
    stats = tstate.stats
    # every alive row: hot gradient AND over the screen-size threshold
    n = 8
    ga = stats.grad_accum.at[:n].set(1.0)
    dn = stats.denom.at[:n].set(1.0)
    mr = stats.max_radii.at[:n].set(50.0)  # > size_threshold 20
    tstate = tstate.replace(
        stats=stats.replace(grad_accum=ga, denom=dn, max_radii=mr)
    )
    new_state, info = densify_and_prune(
        tstate, jax.random.key(3),
        grad_threshold=2e-4, min_opacity=0.005, extent=1e6,
        percent_dense=0.0,  # tiny percent_dense => everything splits
        size_threshold=20.0, scaling_cols=3,
    )
    # all 8 originals pruned for size, but each left 2 split children
    assert int(info["n_pruned"]) == n
    assert int(info["n_pruned_screen"]) == n
    assert int(info["n_alive"]) == 2 * n, (
        "size-pruned rows must leave split children (reference parity)"
    )
    # children start with zeroed stats (so they are NOT size-pruned next)
    assert float(jnp.max(new_state.stats.max_radii)) == 0.0


def test_opacity_pruned_rows_do_not_densify():
    """Opacity-pruned rows die childless: reference children inherit the
    sub-threshold opacity and are pruned in the same call."""
    tstate, tx, cfg = _state_with_capacity()
    p = dict(tstate.params)
    p["opacity"] = jnp.full_like(p["opacity"], -10.0)  # sigmoid ~ 4.5e-5
    stats = tstate.stats
    ga = stats.grad_accum.at[:8].set(1.0)
    dn = stats.denom.at[:8].set(1.0)
    tstate = tstate.replace(
        params=p, stats=stats.replace(grad_accum=ga, denom=dn)
    )
    new_state, info = densify_and_prune(
        tstate, jax.random.key(4),
        grad_threshold=2e-4, min_opacity=0.005, extent=1e6,
        percent_dense=0.0, size_threshold=20.0, scaling_cols=3,
    )
    assert int(info["n_alive"]) == 0
