from ruart_tpu.core.config import Config, read_conf_file
from ruart_tpu.core import constants
