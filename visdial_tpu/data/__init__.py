from .dataset import VisDialSplit, Vocabulary, load_split
from .loader import Batch, BatchAssembler, EvalLoader, TrainLoader, right_align
from .synthetic import make_synthetic_split, synthetic_vocab
