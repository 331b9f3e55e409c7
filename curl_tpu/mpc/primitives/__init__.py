from .arithmetic import ArithmeticSharedTensor  # noqa: F401
from .binary import BinarySharedTensor  # noqa: F401
from . import beaver, circuit, converters, replicated  # noqa: F401
