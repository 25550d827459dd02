from ma_tpu.config.parameters import Parameter, ParameterSet, ParameterSetManager, default_presets
