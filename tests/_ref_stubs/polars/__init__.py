# Minimal stub so the reference package imports for layer-parity testing.
# Only symbols referenced at module import time are provided.
def scan_csv(*a, **k): raise NotImplementedError("polars stub")
def scan_parquet(*a, **k): raise NotImplementedError("polars stub")
def concat(*a, **k): raise NotImplementedError("polars stub")
def col(*a, **k): raise NotImplementedError("polars stub")
class DataFrame: pass
class LazyFrame: pass
class Series: pass
class List: pass
class String: pass
