"""Search-space configs, keyed by the hparams file stem (the reference's
``hparam_configs`` registry, hparams_tuning.py:112-132): the tuning CLI looks
up the module whose name matches the config file and calls its
``hparam_options(hparams, trial)``."""

from hparam_tuning_configs import large_hparam_search  # noqa: F401

hparam_configs = {
    "large_hparam_search": large_hparam_search,
    # default space for the shipped configs
    "final_model": large_hparam_search,
    "smoke_cpu": large_hparam_search,
}
