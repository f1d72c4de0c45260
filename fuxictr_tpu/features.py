"""Feature schema registry.

Byte-compatible with the reference's ``feature_map.json`` schema
(cf. /root/reference/fuxictr/features.py:26-194) so that datasets prepared by
either framework interoperate. Unlike the reference, the TPU build also
derives a *fused-table layout* from the schema (see
:meth:`FeatureMap.embedding_layout`-consumers in ``ops/embedding.py``):
categorical/sequence vocabularies are concatenated into one row space so a
batch lookup is a single gather, which XLA can shard across a mesh axis.
"""

from collections import OrderedDict
import io
import os
import json
import logging


class FeatureMap:
    """Stores feature specs, labels, and the flat column index of a dataset.

    Args:
        dataset_id: unique dataset identifier (must match the JSON file).
        data_dir: directory containing ``feature_map.json`` and sibling
            artifacts (vocab json, pretrained embedding files).
    """

    def __init__(self, dataset_id, data_dir=""):
        self.data_dir = data_dir  # used to resolve pretrained embedding paths
        self.dataset_id = dataset_id
        self.num_fields = 0
        self.total_features = 0
        self.input_length = 0
        self.features = OrderedDict()
        self.labels = []
        self.column_index = {}
        self.group_id = None
        self.default_emb_dim = None

    # ------------------------------------------------------------------ io
    def load(self, json_file, params=None):
        """Load schema from JSON, applying runtime overrides from ``params``.

        Supported params: ``group_id``, ``embedding_dim`` (default dim),
        ``use_features`` (subset selection), ``feature_specs`` (per-feature
        overrides) — same runtime override surface as the reference
        (/root/reference/fuxictr/features.py:54-78).
        """
        params = params or {}
        logging.info("Load feature_map from json: %s", json_file)
        with io.open(json_file, "r", encoding="utf-8") as fd:
            spec = json.load(fd)
        if spec["dataset_id"] != self.dataset_id:
            raise RuntimeError(
                f"dataset_id={self.dataset_id} does not match feature_map "
                f"({spec['dataset_id']})!")
        self.labels = spec.get("labels", [])
        self.total_features = spec.get("total_features", 0)
        self.input_length = spec.get("input_length", 0)
        self.group_id = params.get("group_id", None)
        self.default_emb_dim = params.get("embedding_dim", None)
        self.features = OrderedDict(
            (k, v) for entry in spec["features"] for k, v in entry.items())
        self.num_fields = self.get_num_fields()
        if params.get("use_features"):
            self.features = OrderedDict(
                (name, self.features[name]) for name in params["use_features"])
        if params.get("feature_specs"):
            self.update_feature_specs(params["feature_specs"])
        self.set_column_index()

    def update_feature_specs(self, feature_specs):
        """Merge user-provided spec overrides (list of dicts with ``name``)."""
        for col in feature_specs:
            names = col["name"]
            if not isinstance(names, list):
                names = [names]
            for name in names:
                for k, v in col.items():
                    if k != "name":
                        self.features[name][k] = v

    def save(self, json_file):
        """Persist schema as JSON (same field order as the reference writer)."""
        logging.info("Save feature_map to json: %s", json_file)
        os.makedirs(os.path.dirname(json_file) or ".", exist_ok=True)
        out = OrderedDict()
        out["dataset_id"] = self.dataset_id
        out["num_fields"] = self.num_fields
        out["total_features"] = self.total_features
        out["input_length"] = self.input_length
        out["labels"] = self.labels
        out["features"] = [{k: v} for k, v in self.features.items()]
        with open(json_file, "w") as fd:
            json.dump(out, fd, indent=4)

    # ------------------------------------------------------------ queries
    def get_num_fields(self, feature_source=()):
        """Number of non-meta fields, optionally filtered by source."""
        if not isinstance(feature_source, (list, tuple)):
            feature_source = [feature_source]
        n = 0
        for _, fs in self.features.items():
            if fs["type"] == "meta":
                continue
            if not feature_source or fs.get("source") in feature_source:
                n += 1
        return n

    def sum_emb_out_dim(self, feature_source=()):
        """Total embedding output width across fields (post-encoder dims)."""
        if not isinstance(feature_source, (list, tuple)):
            feature_source = [feature_source]
        total = 0
        for _, fs in self.features.items():
            if fs["type"] == "meta":
                continue
            if not feature_source or fs.get("source") in feature_source:
                total += fs.get("emb_output_dim",
                                fs.get("embedding_dim", self.default_emb_dim))
        return total

    def set_column_index(self):
        """Assign flat column indices: sequence/embedding fields span a range."""
        idx = 0
        for feature, fs in self.features.items():
            if fs["type"] == "sequence":
                self.column_index[feature] = list(range(idx, idx + fs["max_len"]))
                idx += fs["max_len"]
            elif fs["type"] == "embedding":
                dim = fs["pretrain_dim"]
                self.column_index[feature] = list(range(idx, idx + dim))
                idx += dim
            else:
                self.column_index[feature] = idx
                idx += 1
        self.input_length = idx
        for label in self.labels:
            self.column_index[label] = idx
            idx += 1

    def get_column_index(self, feature):
        if feature not in self.column_index:
            self.set_column_index()
        return self.column_index[feature]
