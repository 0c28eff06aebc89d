"""kornia-layout: ``kornia_tpu.contrib.visual_prompter`` mirrors
``kornia.contrib.visual_prompter`` (reference contrib/visual_prompter.py:35).
The implementation lives next to the SAM model."""

from ..models.sam import Sam, SamConfig, VisualPrompter  # noqa: F401

__all__ = ["VisualPrompter", "Sam", "SamConfig"]
