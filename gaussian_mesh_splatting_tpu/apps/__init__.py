"""CLI surface, mirroring the reference's entry points (SURVEY.md §2):

  train            <- train.py
  render           <- scripts/render.py (+ render_multi_mesh.py)
  metrics          <- metrics.py
  render_animated  <- scripts/render_time_animated.py (+ points variant)
  render_mesh_morph<- scripts/render_from_mesh_to_mesh.py
  render_flame     <- scripts/render_flame.py
  pseudomesh       <- scripts/save_pseudomesh.py + create_dummy_mesh.py +
                      edit_pseudomesh_based_on_estimated_mesh.py +
                      render_from_object.py
  full_eval        <- full_eval.py
  convert          <- convert.py
  network_gui      <- renderer/gaussian_renderer/network_gui.py
"""
