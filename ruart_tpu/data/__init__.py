from ruart_tpu.data.collate import Collator
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.data.sampler import VQASampler
from ruart_tpu.data.preprocess import Preprocessor
