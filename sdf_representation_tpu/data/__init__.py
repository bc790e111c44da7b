from .dataset import load_data, df_from_csv, SDFDataset
