"""Arrow-vectorized UDF wrappers around the pure kernel.

No per-row Python UDFs anywhere (BASELINE.json input_hint mandate): only
``mapInPandas`` / ``pandas_udf`` batch kernels. All heavy work stays in
:mod:`llmap_spark.kernel`, which is also the oracle — these wrappers only
adapt pandas batches to kernel calls.
"""
