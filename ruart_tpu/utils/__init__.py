from ruart_tpu.utils.meters import AverageMeter
from ruart_tpu.utils.timing import Timers
