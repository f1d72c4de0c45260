"""fuxictr_tpu: a TPU-native CTR prediction framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of reczoo/FuxiCTR
(reference layout surveyed in SURVEY.md). The compute path is functional JAX
compiled with jit/pjit over a device mesh; the offline feature pipeline runs
on the host (pandas + pyarrow); embedding tables are fused into per-dim
monolithic arrays so lookups are single gathers that XLA can shard.

Public surface mirrors the reference's four pillars:
  - config-driven experiments: :mod:`fuxictr_tpu.config`
  - feature schema + offline pipeline: :mod:`fuxictr_tpu.features`,
    :mod:`fuxictr_tpu.preprocess`
  - layer library + training runtime: :mod:`fuxictr_tpu.ops`,
    :mod:`fuxictr_tpu.models`
  - model zoo: :mod:`fuxictr_tpu.models.zoo`
"""

__version__ = "0.4.0"


def assert_version(min_version):
    """Mirror of the reference's per-model ``fuxictr_version.py`` guard
    (e.g. model_zoo/DeepFM/DeepFM_torch/fuxictr_version.py): user code that
    depends on a minimum framework version calls
    ``fuxictr_tpu.assert_version("0.3.0")``."""
    def _key(v):
        return tuple(int(x) for x in str(v).split("."))
    if _key(__version__) < _key(min_version):
        raise RuntimeError(
            f"fuxictr_tpu>={min_version} required, found {__version__}")

from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.config import (
    load_config,
    load_model_config,
    load_dataset_config,
    set_logger,
    print_to_json,
    print_to_list,
    Monitor,
    not_in_whitelist,
)
