"""Entry points / CLIs (SURVEY.md §1 L7).

Each module mirrors one reference script:

- ``cli.train``                ← scripts/train.py
- ``cli.train_seg_gan``        ← scripts/train_seg_gan.py
- ``cli.val``                  ← scripts/val.py
- ``cli.val_patch``            ← scripts/val_patch.py
- ``cli.smoke_test``           ← scripts/aerial_image_segmentation_test.py
- ``cli.preprocess_satellite`` ← scripts/preprocess_satellite.py
- ``cli.preprocess_SN7``       ← scripts/preprocess_SN7.py
"""
