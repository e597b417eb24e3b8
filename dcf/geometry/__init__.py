from dcf.geometry.boxes import (
    box_corners_bev,
    boxes3d_corners,
    decode_boxes,
    encode_boxes,
    rotated_iou_bev,
    iou_3d,
)
from dcf.geometry import np_boxes
from dcf.geometry.transforms import Calibration, project_velo_to_image

__all__ = [
    "box_corners_bev", "boxes3d_corners", "decode_boxes", "encode_boxes",
    "rotated_iou_bev", "iou_3d", "np_boxes", "Calibration",
    "project_velo_to_image",
]
