"""Dataset building: split → fit-on-train → transform → parquet parts.

Parity with /root/reference/fuxictr/preprocess/build_dataset.py:27-171
(sequential/random splits with fraction-or-count sizes, fit on train only,
idempotent skip when ``feature_map.json`` exists, ``part_{:05d}.parquet``
block layout, ``rebuild_dataset=False`` schema-only path). Pandas-based
(the reference's Polars is absent in this environment).
"""

import gc
import logging
import os

import numpy as np


def split_train_test(train_ddf=None, valid_ddf=None, test_ddf=None,
                     valid_size=0, test_size=0, split_type="sequential"):
    """Split a train frame; sizes <1 are fractions of the total."""
    num_samples = len(train_ddf)
    train_size = num_samples
    sequential = split_type != "random"
    instance_ids = np.arange(num_samples)
    if not sequential:
        np.random.shuffle(instance_ids)

    def take(lo, hi):
        # sequential split = contiguous slice (cheap view; fancy-indexing
        # arrow-backed frames costs ~100x more)
        if sequential:
            return train_ddf.iloc[lo:hi].reset_index(drop=True)
        return train_ddf.iloc[instance_ids[lo:hi]].reset_index(drop=True)

    if test_size > 0:
        if test_size < 1:
            test_size = int(num_samples * test_size)
        train_size -= test_size
        test_ddf = take(train_size, train_size + test_size)
    if valid_size > 0:
        if valid_size < 1:
            valid_size = int(num_samples * valid_size)
        train_size -= valid_size
        valid_ddf = take(train_size, train_size + valid_size)
    if valid_size > 0 or test_size > 0:
        train_ddf = take(0, train_size)
    return train_ddf, valid_ddf, test_ddf


def transform_block(feature_encoder, df_block, filename):
    out = feature_encoder.transform(df_block)
    # narrow dtypes before writing: encoded ids fit int32 and values
    # float32 — halves part-file decode time and disk footprint (the
    # loaders' column store is int32/float32 anyway)
    import numpy as np
    for col in out.columns:
        dt = out[col].dtype
        if dt == np.int64:
            out[col] = out[col].astype(np.int32)
        elif dt == np.float64:
            out[col] = out[col].astype(np.float32)
        elif dt == object and len(out) and \
                isinstance(out[col].iloc[0], np.ndarray):
            if out[col].iloc[0].dtype == np.int64:
                out[col] = out[col].map(
                    lambda a: a.astype(np.int32))
    data_path = os.path.join(feature_encoder.data_dir, filename)
    logging.info("Saving data to parquet: %s", data_path)
    os.makedirs(os.path.dirname(data_path), exist_ok=True)
    out.to_parquet(data_path, index=False, engine="pyarrow")


def transform(feature_encoder, df, filename, block_size=0):
    if block_size > 0:
        # thread pool instead of the reference's fork-per-block mp.Pool:
        # the encode/write path is arrow-native and releases the GIL
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=4) as pool:
            futures = [
                pool.submit(transform_block, feature_encoder,
                            df.iloc[idx:idx + block_size],
                            "{}/part_{:05d}.parquet".format(filename,
                                                            block_id))
                for block_id, idx in enumerate(
                    range(0, len(df), block_size))]
            for f in futures:
                f.result()
    else:
        transform_block(feature_encoder, df, filename + ".parquet")


def build_dataset(feature_encoder, train_data=None, valid_data=None,
                  test_data=None, valid_size=0, test_size=0,
                  split_type="sequential", data_block_size=0,
                  rebuild_dataset=True, **kwargs):
    """Build feature_map and transform data; returns processed split paths."""
    if rebuild_dataset:
        feature_map_path = os.path.join(feature_encoder.data_dir,
                                        "feature_map.json")
        if os.path.exists(feature_map_path):
            logging.warning("Skip rebuilding %s. Delete it manually if "
                            "rebuilding is required.", feature_map_path)
        else:
            train_ddf = feature_encoder.read_data(train_data, **kwargs)
            valid_ddf = None
            test_ddf = None
            if valid_size > 0 or test_size > 0:
                valid_ddf = feature_encoder.read_data(valid_data, **kwargs) \
                    if valid_data else None
                test_ddf = feature_encoder.read_data(test_data, **kwargs) \
                    if test_data else None
                train_ddf, valid_ddf, test_ddf = split_train_test(
                    train_ddf, valid_ddf, test_ddf, valid_size, test_size,
                    split_type)

            train_ddf = feature_encoder.preprocess(train_ddf)
            feature_encoder.fit(train_ddf, rebuild_dataset=True, **kwargs)
            transform(feature_encoder, train_ddf, "train",
                      block_size=data_block_size)
            del train_ddf
            gc.collect()

            if valid_ddf is None and valid_data is not None:
                valid_ddf = feature_encoder.read_data(valid_data, **kwargs)
            if valid_ddf is not None:
                valid_ddf = feature_encoder.preprocess(valid_ddf)
                transform(feature_encoder, valid_ddf, "valid",
                          block_size=data_block_size)
                del valid_ddf
                gc.collect()

            if test_ddf is None and test_data is not None:
                test_ddf = feature_encoder.read_data(test_data, **kwargs)
            if test_ddf is not None:
                test_ddf = feature_encoder.preprocess(test_ddf)
                transform(feature_encoder, test_ddf, "test",
                          block_size=data_block_size)
                del test_ddf
                gc.collect()
            logging.info("Transform csv data to parquet done.")

        train_data = os.path.join(feature_encoder.data_dir, "train")
        valid_data = os.path.join(feature_encoder.data_dir, "valid")
        test_data = (os.path.join(feature_encoder.data_dir, "test")
                     if (test_data or test_size > 0) else None)
    else:
        feature_encoder.fit(None, rebuild_dataset=False, **kwargs)
    return train_data, valid_data, test_data
