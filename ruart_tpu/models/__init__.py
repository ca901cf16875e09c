from ruart_tpu.models.fusion.model import RUArtModel, install_embeddings
from ruart_tpu.models.fusion.spec import ModelSpec
from ruart_tpu.models.bert.model import BertModel, BertWordEncoder
from ruart_tpu.models.bert.config import BertConfig
