"""Graph kernels (the reference's "algorithms"), re-expressed as Spark
DataFrame programs + checkpointed supersteps."""
