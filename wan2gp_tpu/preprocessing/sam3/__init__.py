"""SAM3 promptable segmentation (image grounding + video tracking).

TPU-native re-implementation of the reference SAM3 stack
(/root/reference/preprocessing/sam3/): ViTDet backbone + SimpleFPN neck,
VE CLIP text encoder, geometry (point/box) prompt encoder, GroundingDINO-
style fusion encoder, DETR decoder with box refinement + boxRPB + presence
token, MaskFormer segmentation head, and a SAM2-style memory tracker for
video propagation.  See model.py for the orchestration entry points.
"""
from .model import (Sam3Config, init_sam3, sam3_detect, Sam3ImagePredictor)
