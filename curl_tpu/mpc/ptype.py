"""Share-type enum (reference: curl/mpc/ptype.py:13)."""

from enum import Enum


class ptype(Enum):
    arithmetic = 0
    binary = 1

    def to_tensor(self):
        from .primitives.arithmetic import ArithmeticSharedTensor
        from .primitives.binary import BinarySharedTensor

        return (
            ArithmeticSharedTensor if self == ptype.arithmetic else BinarySharedTensor
        )
