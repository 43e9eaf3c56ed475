"""Import-only pycocotools stub (reference data modules import COCO/mask at
module scope; parity tests never touch COCO annotations)."""
