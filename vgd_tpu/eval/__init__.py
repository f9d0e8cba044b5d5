from vgd_tpu.eval.metrics import (mse_metric, psnr, ssim, MetricAccumulator,
                                  frechet_distance, inception_score_from_logits,
                                  manifold_precision_recall)
