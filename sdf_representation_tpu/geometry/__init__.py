from .mesh_io import Mesh, load_mesh, save_mesh
from .rescale import rescale_mesh
