from aum_tpu.convert.torch_port import (
    port_aum_state_dict,
    port_vim_imagenet_state_dict,
    load_torch_checkpoint,
    export_aum_state_dict,
    save_reference_checkpoint,
)

__all__ = [
    "port_aum_state_dict",
    "port_vim_imagenet_state_dict",
    "load_torch_checkpoint",
    "export_aum_state_dict",
    "save_reference_checkpoint",
]
