"""Model zoo. Importing this package registers every model class."""

from fuxictr_tpu.models.zoo import ranking  # noqa: F401
from fuxictr_tpu.models.zoo import ranking2  # noqa: F401
from fuxictr_tpu.models.zoo import ranking3  # noqa: F401
from fuxictr_tpu.models.zoo import ranking4  # noqa: F401
from fuxictr_tpu.models.zoo import ranking5  # noqa: F401
from fuxictr_tpu.models.zoo import sequence  # noqa: F401
from fuxictr_tpu.models.zoo import sequence2  # noqa: F401
from fuxictr_tpu.models.zoo import multitask_zoo  # noqa: F401
from fuxictr_tpu.models.zoo import dynamic  # noqa: F401
from fuxictr_tpu.models.zoo import longctr  # noqa: F401
from fuxictr_tpu.models.zoo import longctr2  # noqa: F401

from fuxictr_tpu.models.registry import MODEL_REGISTRY  # noqa: F401

globals().update(MODEL_REGISTRY)
