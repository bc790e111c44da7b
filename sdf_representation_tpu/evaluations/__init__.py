from .reconstruct import reconstruct_only, reconstruct_mesh
from .post_process import post_process
from .metrics import chamfer_distance, sign_accuracy, thresholded_nmse
