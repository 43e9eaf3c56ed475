from .panoptic_head import (PanopticHead, MHAttentionMap,  # noqa: F401
                            MaskHeadSmallConv, DetrPanoptic,
                            inference_with_masks)
from .criterion import panoptic_criterion, dice_loss, focal_mask_loss  # noqa: F401
