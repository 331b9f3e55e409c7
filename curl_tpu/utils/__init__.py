from .tensor_types import is_encrypted_tensor, is_float_tensor, is_int_tensor, is_tensor  # noqa: F401
from .serial import RestrictedUnpickler, register_safe_class, restricted_loads  # noqa: F401
