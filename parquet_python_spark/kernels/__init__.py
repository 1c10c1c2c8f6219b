"""Pure-numpy codec kernels.  No Spark imports here — these run inside
Arrow-batched ``mapInPandas`` UDFs on executors, and in unit tests without a
SparkSession."""
