from .anchors import (
    generate_cell_anchors,
    retinanet_cell_anchors,
    field_of_anchors,
    all_field_anchors,
    assign_retinanet_labels,
)
