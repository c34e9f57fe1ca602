from fitgnn_tpu.utils.cache import ArtifactCache, content_key
from fitgnn_tpu.utils.logging import ScalarWriter

__all__ = ["ArtifactCache", "content_key", "ScalarWriter"]
