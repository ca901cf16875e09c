from ruart_tpu.text.featurizer import POS, ENT, POS_VOCAB_SIZE, ENT_VOCAB_SIZE
