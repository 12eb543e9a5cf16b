from genometester4_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    sharded_count_step,
    count_kmers_sharded,
)
