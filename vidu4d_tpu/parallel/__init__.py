from vidu4d_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    build_stage3_train_step,
    make_synthetic_stage3_inputs,
)
