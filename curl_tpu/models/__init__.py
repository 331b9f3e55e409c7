from .gpt import GPT, GPT2, GPTNeo, GPTNeoLarge  # noqa: F401
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101  # noqa: F401
from .bert_classifier import (  # noqa: F401
    BertBaseForSequenceClassification,
    BertForSequenceClassification,
    BertTinyForSequenceClassification,
)
from .bert import Bert, BertTiny, BertBase, BertLarge  # noqa: F401
