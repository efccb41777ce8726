"""Per-family slices of the query inventory — see plans/queries.py,
the order-preserving aggregator that imports every part."""
