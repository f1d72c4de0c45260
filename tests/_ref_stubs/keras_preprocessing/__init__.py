# Stub package so the reference imports for layer-parity testing.
