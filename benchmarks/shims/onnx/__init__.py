"""Minimal onnx stand-in: the reference imports onnx at module load but the
baseline measurement path (hand-built GPT/BERT models) never converts
through ONNX. Any actual use raises."""


class _Unavailable:
    def __getattr__(self, name):
        raise RuntimeError("onnx is not available in the baseline environment")


ModelProto = _Unavailable
numpy_helper = _Unavailable()


def load(*a, **k):
    raise RuntimeError("onnx is not available in the baseline environment")
