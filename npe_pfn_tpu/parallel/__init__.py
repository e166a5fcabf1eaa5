from .mesh import (  # noqa: F401
    get_mesh,
    make_sharded_train_step,
    shard_batch,
    sharded_autoregressive_sample,
)
from .expert_parallel import (  # noqa: F401
    ep_place,
    ep_pspecs,
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
