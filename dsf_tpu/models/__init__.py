from dsf_tpu.models.backbone import ManoOCR, ManoOCRStage  # noqa: F401
from dsf_tpu.models.cyclegan import ResnetGenerator  # noqa: F401
