"""Pure-NumPy kernels. No Spark imports allowed in this package —
these run inside pandas/Arrow UDF workers and in pytest directly."""
