from .dataset import Camera, InputData, input_data_from_x
