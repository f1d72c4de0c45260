"""Per-dataset customized feature processors (Criteo, Avazu, KKBox).

Resolved by name from YAML ``preprocess:`` fields the same way the
reference does (getattr on the processor subclass returning Polars
expressions — /root/reference/fuxictr/datasets/*.py).
"""
