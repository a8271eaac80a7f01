from mmssl_tpu.data.dataset import RecDataset, load_dataset  # noqa: F401
from mmssl_tpu.data.sampler import NegativeSampler  # noqa: F401
from mmssl_tpu.data.synthetic import write_synthetic_dataset  # noqa: F401
