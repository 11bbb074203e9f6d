from plastic_unet_tpu.eval.evaluate import eval_net, predict_masks, score_model_best_iou  # noqa: F401
