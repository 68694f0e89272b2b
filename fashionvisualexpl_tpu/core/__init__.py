from fashionvisualexpl_tpu.core.config import (
    ACFConfig,
    AttentiveFashionConfig,
    BPRMFConfig,
    GradFashionConfig,
    MeshConfig,
    MODEL_CONFIGS,
    Paths,
    TrainConfig,
    VBPRConfig,
)
from fashionvisualexpl_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    is_trivial,
    make_mesh,
    replicated,
    row_sharding,
    single_device_mesh,
)
from fashionvisualexpl_tpu.core.train_state import (
    TrainState,
    apply_gradients,
    create_train_state,
    tf_parity_adam,
)
