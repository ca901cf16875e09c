from ruart_tpu.train.trainer import Trainer
