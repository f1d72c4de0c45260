"""Vocabulary building and id encoding.

Behavioral parity with the reference Tokenizer
(/root/reference/fuxictr/preprocess/tokenizer.py:28-238): ``__PAD__`` = 0,
``__OOV__`` = last index, min_freq/max_features filtering, shared-vocab
merge, pre/post pad+truncate for sequences (keras pad_sequences semantics).

TPU-build differences: counting/encoding use vectorized pandas/NumPy ops
(value_counts, dict-map) instead of per-chunk process pools; vocab order
matches the reference's ``Counter.most_common`` convention (count desc,
ties by first appearance) so fixture goldens transfer.
"""

import numpy as np
import pandas as pd


class Tokenizer:
    def __init__(self, max_features=None, na_value="", min_freq=1,
                 splitter=None, remap=True, lower=False, max_len=0,
                 padding="pre"):
        self._max_features = max_features
        self._na_value = na_value
        self._min_freq = min_freq
        self._lower = lower
        self._splitter = splitter
        self.vocab = {}
        self.max_len = max_len
        self.padding = padding
        self.remap = remap

    # ------------------------------------------------------------- fitting
    def fit_on_series(self, series):
        """Build vocab from a raw-value series; sequences are split first
        and ``max_len`` auto-detected when not given."""
        series = _to_pandas(series)
        if self._splitter is not None:
            parts = series.astype(str).str.split(self._splitter)
            max_len = int(parts.str.len().max() or 0)
            if self.max_len == 0:
                self.max_len = max_len
            tokens = parts.explode()
        else:
            tokens = series
        # count desc, ties by token ascending — matches the ordering baked
        # into the reference's committed tiny fixtures, and is deterministic
        # regardless of input row order (the reference's first-appearance
        # tie-break is not)
        counts = tokens.value_counts()
        pairs = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        self.build_vocab(pairs)

    fit_on_texts = fit_on_series  # reference-compatible alias

    def build_vocab(self, word_counts):
        """``word_counts``: (token, count) pairs sorted by count descending."""
        if isinstance(word_counts, dict):
            word_counts = sorted(word_counts.items(), key=lambda x: -x[1])
        if self._max_features:
            word_counts = word_counts[:self._max_features]
        words = []
        for token, count in word_counts:
            if count < self._min_freq:
                break  # sorted descending
            if token is None or token == self._na_value:
                continue
            words.append(str(token).lower() if self._lower else token)
        if self.remap:
            self.vocab = {tok: idx for idx, tok in enumerate(words, 1)}
        else:
            self.vocab = {tok: int(tok) for tok in words}
        self.vocab["__PAD__"] = 0
        self.vocab["__OOV__"] = self.vocab_size()

    def vocab_size(self):
        return max(self.vocab.values()) + 1

    def merge_vocab(self, shared_tokenizer):
        """Merge into a shared tokenizer (share_embedding); both end up
        pointing at the same dict (reference tokenizer.py:106-128)."""
        if self.remap:
            new_words = 0
            for word in self.vocab:
                if word not in shared_tokenizer.vocab:
                    shared_tokenizer.vocab[word] = (
                        shared_tokenizer.vocab["__OOV__"] + new_words)
                    new_words += 1
        else:
            shared_tokenizer.vocab.update(self.vocab)
        vocab_size = shared_tokenizer.vocab_size()
        if (shared_tokenizer.vocab["__OOV__"] != vocab_size - 1
                or shared_tokenizer.vocab["__OOV__"]
                != len(shared_tokenizer.vocab) - 1):
            shared_tokenizer.vocab["__OOV__"] = vocab_size
        self.vocab = shared_tokenizer.vocab
        return shared_tokenizer

    def update_vocab(self, word_list):
        new_words = 0
        for word in word_list:
            if word not in self.vocab:
                self.vocab[word] = self.vocab.get("__OOV__", 0) + new_words
                new_words += 1
        if new_words > 0:
            self.vocab["__OOV__"] = self.vocab_size()

    # ------------------------------------------------------------ encoding
    def encode_meta(self, series):
        series = _to_pandas(series)
        counts = series.value_counts()
        if not self.vocab:
            self.build_vocab(list(counts.items()))
        else:  # meta values in valid/test may be unseen — expand
            self.update_vocab(counts.index.tolist())
        return self.encode_category(series)

    def encode_category(self, series):
        """Vectorized dict lookup: C-hash-table categorical codes instead of
        a Python-level map (the reference maps per element; at Criteo scale
        that dominates the transform)."""
        series = _to_pandas(series)
        oov = self.vocab["__OOV__"]
        tokens = list(self.vocab)   # includes __PAD__/__OOV__ (dict parity)
        if not tokens:
            return np.full(len(series), oov, np.int64)
        ids = np.fromiter((self.vocab[t] for t in tokens), np.int64,
                          len(tokens))
        try:                       # native hash join on arrow arrays
            import pyarrow as pa
            import pyarrow.compute as pc
            arr = pa.Array.from_pandas(series)
            pos = pc.index_in(arr, value_set=pa.array(
                tokens, type=arr.type)).to_numpy(zero_copy_only=False)
            valid = ~np.isnan(pos) if pos.dtype.kind == "f" else pos >= 0
            pos = np.nan_to_num(pos, nan=0).astype(np.int64)
            return np.where(valid, ids[pos], oov).astype(np.int64)
        except Exception:
            codes = pd.Categorical(series, categories=tokens).codes
            out = np.where(codes >= 0, ids[np.maximum(codes, 0)], oov)
            return out.astype(np.int64)

    def encode_sequence(self, series):
        """Encode splitter-joined strings to [N, max_len] id lists with
        pre/post pad+truncate."""
        series = _to_pandas(series).astype(str)
        pad, oov = self.vocab["__PAD__"], self.vocab["__OOV__"]
        na = self._na_value
        vocab = self.vocab
        out = np.full((len(series), self.max_len), pad, dtype=np.int64)
        trunc_pre = self.padding == "pre"
        max_len = self.max_len
        for i, text in enumerate(series.to_numpy()):
            toks = text.split(self._splitter)
            ids = [pad if t == na else vocab.get(t, oov) for t in toks]
            ids = ids[-max_len:] if trunc_pre else ids[:max_len]
            if trunc_pre:
                out[i, max_len - len(ids):] = ids
            else:
                out[i, :len(ids)] = ids
        return list(out)

    def load_pretrained_vocab(self, feature_dtype, pretrain_path,
                              expand_vocab=True):
        """Expand vocab with pretrained-table keys; OOV index untouched
        (it is baked into PretrainedEmbedding masking)."""
        if pretrain_path.endswith(".h5"):
            import h5py
            with h5py.File(pretrain_path, "r") as hf:
                keys = np.array(hf["key"])
        elif pretrain_path.endswith(".npz"):
            keys = np.load(pretrain_path, allow_pickle=True)["key"]
        else:
            keys = pd.read_parquet(pretrain_path)["key"].to_numpy()
        keys = np.asarray(keys).astype(feature_dtype)
        if expand_vocab:
            vocab_size = self.vocab_size()
            for word in keys:
                if word not in self.vocab:
                    self.vocab[word] = vocab_size
                    vocab_size += 1


def _to_pandas(series):
    if isinstance(series, pd.Series):
        return series
    return pd.Series(series)
