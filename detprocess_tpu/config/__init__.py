from detprocess_tpu.config.yamlconfig import YamlConfig  # noqa: F401
