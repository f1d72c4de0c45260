"""Numeric normalizers (parity: /root/reference/fuxictr/preprocess/normalizer.py).

Supports sklearn StandardScaler/MinMaxScaler by name, or a named function
from :data:`NORMALIZER_REGISTRY` (the reference accepts arbitrary callables;
we accept callables too but resolve strings through a registry, never eval).
"""

import numpy as np

NORMALIZER_REGISTRY = {
    "log1p": lambda x: np.log1p(np.maximum(x, 0)),
    "log": lambda x: np.log(np.maximum(x, 1e-12)),
}


class Normalizer:
    def __init__(self, normalizer):
        if callable(normalizer):
            self.normalizer = normalizer
            self.callable = True
        elif normalizer in ("StandardScaler", "MinMaxScaler"):
            import sklearn.preprocessing as sk
            self.normalizer = getattr(sk, normalizer)()
            self.callable = False
        elif normalizer in NORMALIZER_REGISTRY:
            self.normalizer = NORMALIZER_REGISTRY[normalizer]
            self.callable = True
        else:
            raise NotImplementedError(f"normalizer={normalizer}")

    def fit(self, X):
        if not self.callable:
            self.normalizer.fit(np.asarray(X, dtype=np.float64).reshape(-1, 1))

    def transform(self, X):
        X = np.asarray(X, dtype=np.float64)
        if self.callable:
            return self.normalizer(X)
        return self.normalizer.transform(X.reshape(-1, 1)).flatten()
