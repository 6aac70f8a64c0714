from dsf_tpu.render.renderer import Renderer, synth_sample, render_params, mask_img  # noqa: F401
