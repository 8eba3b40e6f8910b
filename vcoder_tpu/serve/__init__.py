from vcoder_tpu.serve.engine import Request, ServingEngine
from vcoder_tpu.serve.paged_engine import PagedServingEngine

__all__ = ["Request", "ServingEngine", "PagedServingEngine"]
