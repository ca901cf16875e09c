from ruart_tpu.models.fusion.model import RUArtModel, install_embeddings
from ruart_tpu.models.fusion.spec import ModelSpec
