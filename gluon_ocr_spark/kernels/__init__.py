"""Pure-Python/NumPy kernels.

These are Spark-free and deterministic; the Spark operators wrap them
inside Arrow-batched UDFs, and the test oracle calls them directly, so
distributed output is byte-identical to the single-process oracle by
construction.
"""
