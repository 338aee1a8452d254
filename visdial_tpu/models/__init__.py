from .model import model_init, model_loss, model_scores
