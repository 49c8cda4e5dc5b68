from osmalyzer_spark.datagen.images import generate_images
from osmalyzer_spark.datagen.views import data_items_view, osm_elements_view

__all__ = ["generate_images", "osm_elements_view", "data_items_view"]
