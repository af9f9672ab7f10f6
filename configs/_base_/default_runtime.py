# default runtime (schema mirrors the reference configs/_base_/default_runtime.py)
log_config = dict(interval=10)
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
