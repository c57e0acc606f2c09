from exllamav2_tpu.vlm.vision_tower import VisionTower
from exllamav2_tpu.vlm.mm_embedding import MMEmbedding

__all__ = ["VisionTower", "MMEmbedding"]
