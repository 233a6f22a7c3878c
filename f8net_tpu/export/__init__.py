from .torch_export import build_torch_int_model, export_torchscript
from .bundle import save_deploy_bundle, load_deploy_bundle
from .native_bundle import save_native_bundle, load_native_bundle
