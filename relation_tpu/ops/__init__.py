from relation_tpu.ops.boxes import (bbox_transform, bbox_pred, clip_boxes,
                                    bbox_overlaps, pairwise_iou, refine_bbox)
from relation_tpu.ops.anchors import generate_anchors, shift_anchors
from relation_tpu.ops.nms import (greedy_nms_mask, greedy_nms_topk, soft_nms,
                                  classwise_nms)
from relation_tpu.ops.embeddings import (extract_position_matrix,
                                         extract_position_embedding,
                                         extract_rank_embedding,
                                         extract_multi_position_matrix,
                                         extract_pairwise_multi_position_embedding)
from relation_tpu.ops.roi_pool import roi_align, roi_pool
