from .gpt import GPT, GPT2, GPTNeo, GPTNeoLarge  # noqa: F401
from .bert import Bert, BertTiny, BertBase, BertLarge  # noqa: F401
