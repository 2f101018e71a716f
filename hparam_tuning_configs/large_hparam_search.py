"""The broad search space of the reference
(hparam_tuning_configs/large_hparam_search.py): flow depth/width, conditioning
encoders per modality, optimizer/schedule, negative-NLL trick, sequence
length, expression dimensionality."""


def hparam_options(hparams, trial):
    hparams.Glow["K"] = trial.suggest_categorical("K", [4, 8, 16, 32])
    hparams.Conditioning["cond_dim"] = trial.suggest_categorical(
        "cond_dim", [64, 128, 256, 512, 1024])

    hparams.Optim["name"] = trial.suggest_categorical(
        "optim_name", ["adam", "sgd", "rmsprop"])
    hparams.Optim["Schedule"]["name"] = trial.suggest_categorical(
        "Schedule_name", [None, "step"])
    hparams.Optim["Schedule"]["args"]["step"]["gamma"] = trial.suggest_uniform(
        "Schedule_gamma", 0, 1)
    hparams.Optim["Schedule"]["args"]["step"]["step_size"] = trial.suggest_int(
        "Schedule_step_size", 1, 10)
    hparams.Optim["Schedule"]["warm_up"] = trial.suggest_int(
        "lr_warm_up", 0, 4000)

    hparams.Glow["hidden_channels"] = trial.suggest_categorical(
        "hidden_channels", [16, 32, 64, 128, 256, 512])
    hparams.lr = trial.suggest_loguniform("lr", 1e-5, 1e-3)
    hparams.Train["use_negative_nll_loss"] = trial.suggest_categorical(
        "use_negative_nll_loss", [True, False])
    hparams.Train["seq_len"] = trial.suggest_int("seq_len", 30, 90)
    # bounded by what the feature store actually holds (the reference h5 has
    # 100 expression dims; the base config's value is the ceiling here)
    hparams.Data["expression_dim"] = trial.suggest_int(
        "expression_dim", 5, hparams.Data["expression_dim"])
    # keep the packed face layout consistent with the sampled expression dim
    hparams.Conditioning["p1_face"]["dim"] = (
        hparams.Data["expression_dim"] + hparams.Data["jaw_dim"]
        + hparams.Data["neck_dim"])
    hparams.Conditioning["p2_face"]["dim"] = hparams.Conditioning["p1_face"]["dim"]

    def enc_space(name, hist, hidden):
        return {
            "dropout": trial.suggest_uniform(f"{name}_dropout", 0, 1),
            "enc": trial.suggest_categorical(f"{name}_enc",
                                             ["rnn", "mlp", "none"]),
            "history": trial.suggest_categorical(f"{name}_history", hist),
            "hidden_dim": trial.suggest_categorical(f"{name}_hidden_dim",
                                                    hidden),
        }

    face_hist, face_hidden = [2, 4, 8, 16, 24], [128, 256, 512]
    speech_hist, speech_hidden = [2, 4, 8, 16], [64, 128, 256]

    p1_face_dim = hparams.Conditioning["p1_face"]["dim"]
    hparams.Conditioning["p1_face"] = {
        **enc_space("p1_face", face_hist, face_hidden), "dim": p1_face_dim}
    hparams.Conditioning["p2_face"] = {
        **enc_space("p2_face", face_hist, face_hidden), "dim": p1_face_dim}
    hparams.Conditioning["p1_speech"] = enc_space(
        "p1_speech", speech_hist, speech_hidden)
    hparams.Conditioning["p2_speech"] = enc_space(
        "p2_speech", speech_hist, speech_hidden)
    return hparams
