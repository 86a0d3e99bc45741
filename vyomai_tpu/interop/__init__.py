from . import torch_import  # noqa: F401
from . import hf_import  # noqa: F401
from . import hf_export  # noqa: F401
from . import aot  # noqa: F401
