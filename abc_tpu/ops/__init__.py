from abc_tpu.ops.modarith import barrett_mu, get_engine, shoup  # noqa: F401
