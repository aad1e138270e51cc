from attngan_tpu.eval.fid import FIDEvaluator, activation_statistics, frechet_distance

__all__ = ["FIDEvaluator", "activation_statistics", "frechet_distance"]
