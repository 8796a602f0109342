from .pipeline import (
    dt_auc_grid,
    kmeans_assign,
    svm_auc_grid,
    to_ml_vectors,
)

__all__ = ["to_ml_vectors", "kmeans_assign", "dt_auc_grid", "svm_auc_grid"]
