from .metrics import ranks_from_scores, retrieval_metrics
