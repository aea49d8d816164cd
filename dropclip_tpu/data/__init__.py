"""Host-side data pipeline: raw readers, processed datasets, augmentation."""
