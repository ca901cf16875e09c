from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.bert.model import BertModel, BertWordEncoder
