from abc_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, sharded_key_switch, sharded_rotate_rows,
)
