"""Render pipelines ("model families"): the jittable frame functions.

Counterpart of the reference's render orchestration + megakernel entry
(reference: src/render/render.cpp:55-295, shaders/rt/rt.frag:50-197).
"""

from .pipeline import (FrameInputs, RenderState, FrameOutputs, render_frame,
                       make_render_fn)
from .presets import PRESETS, preset
