"""Spark operators: thin DataFrame/Arrow-UDF wrappers around the kernels."""
