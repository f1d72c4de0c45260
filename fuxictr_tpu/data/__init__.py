from fuxictr_tpu.data.array_dataset import load_columns, SAMPLE_MASK_KEY
from fuxictr_tpu.data.loader import (
    RankDataLoader,
    InMemoryDataLoader,
    BlockStreamingDataLoader,
)
