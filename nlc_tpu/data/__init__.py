from .eval_datasets import get_eval_dataset, batch_iterator
from .train_data import load_training_data
