from .box_ops import (
    box_cxcywh_to_xyxy,
    box_cxcywh_to_xywh,
    box_xyxy_to_cxcywh,
    box_area,
    box_iou_union,
    generalized_box_iou,
    box_iou_pairwise,
)
from .misc import (
    inverse_sigmoid,
    pos_to_pos_embed,
    logits_to_scores,
    set_seed,
)
