from ma_tpu.utils.profile import AnalyzeRuntimes, stage_timer
