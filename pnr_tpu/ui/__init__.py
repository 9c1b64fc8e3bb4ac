from pnr_tpu.ui.dialog import CommonDialog, prompt_parameters

__all__ = ["CommonDialog", "prompt_parameters"]
