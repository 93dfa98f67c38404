from itermvs_tpu.io.pfm import read_pfm, save_pfm
from itermvs_tpu.io.cams import read_cam_file, read_camera_parameters, write_cam_file
from itermvs_tpu.io.pair import read_pair_file, write_pair_file
from itermvs_tpu.io.ply import write_ply, read_ply

__all__ = [
    "read_pfm", "save_pfm",
    "read_cam_file", "read_camera_parameters", "write_cam_file",
    "read_pair_file", "write_pair_file",
    "write_ply", "read_ply",
]
