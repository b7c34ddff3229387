from .metrics import AverageMeter, confusion_matrix, per_class_accuracy, topk_accuracy

__all__ = ["AverageMeter", "confusion_matrix", "per_class_accuracy", "topk_accuracy"]
