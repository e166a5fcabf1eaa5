from .mesh import (  # noqa: F401
    get_mesh,
    make_sharded_train_step,
    shard_batch,
    sharded_autoregressive_sample,
)
from .tensor_parallel import (  # noqa: F401
    param_pspecs,
    tp_forward_logits,
    tp_place,
)
