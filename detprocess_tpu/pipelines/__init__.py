from detprocess_tpu.pipelines.features import FeatureProcessing  # noqa: F401
