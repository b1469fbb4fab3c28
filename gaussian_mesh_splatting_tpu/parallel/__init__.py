from .mesh_setup import create_mesh, local_batch_slice
from .data_parallel import make_dp_train_step
