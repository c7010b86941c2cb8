from uresnet_pytorch_tpu.utils.csvdata import CSVData  # noqa: F401
from uresnet_pytorch_tpu.utils.timing import StopWatch  # noqa: F401
