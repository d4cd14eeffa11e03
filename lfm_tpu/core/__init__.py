from lfm_tpu.core.config import Config, DataConfig, MeshConfig, ModelConfig, PRESETS, SampleConfig, TrainConfig, get_preset, load_argfile
from lfm_tpu.core.rng import DummyRNG, SampleRNG, get_generator
from lfm_tpu.core.sharding import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS, data_sharding, local_batch_size, make_mesh, replicated, shard_batch
