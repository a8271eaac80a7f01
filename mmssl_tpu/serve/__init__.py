from mmssl_tpu.serve.engine import RecommendEngine

__all__ = ["RecommendEngine"]
