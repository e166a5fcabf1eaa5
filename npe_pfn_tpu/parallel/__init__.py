from .mesh import (  # noqa: F401
    get_mesh,
    make_sharded_train_step,
    shard_batch,
    sharded_autoregressive_sample,
)
from .pipeline import (  # noqa: F401
    pp_decode,
    pp_fit_encode,
)
from .tensor_parallel import (  # noqa: F401
    param_pspecs,
    tp_forward_logits,
    tp_place,
)
