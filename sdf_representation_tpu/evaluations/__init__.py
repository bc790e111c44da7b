from .reconstruct import reconstruct_only, reconstruct_mesh
from .post_process import post_process
from .metrics import chamfer_distance, sign_accuracy, thresholded_nmse
from .normal_comparison import compute_normal_for_model
from .compare_octree_dl import compare_octree_dl, load_octree_nodes
from .visualize_errors import plot_errors
