from vcoder_tpu.models import clip, llama, projectors, vcoder

__all__ = ["clip", "llama", "projectors", "vcoder"]
