"""Console chat (reference examples/chat.py analog).

Prompt formats: raw / llama / llama3 / chatml / mistral / gemma / phi3 /
cohere / granite / deepseek. Streams tokens as they generate.

    python examples/chat.py -m <model_dir> -mode llama3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPT_FORMATS = {
    "raw": {
        "system": "{system}\n",
        "turn": "User: {user}\nAssistant:",
        "stop": ["User:"],
    },
    "llama3": {
        "system": "<|begin_of_text|><|start_header_id|>system"
                  "<|end_header_id|>\n\n{system}<|eot_id|>",
        "turn": "<|start_header_id|>user<|end_header_id|>\n\n{user}"
                "<|eot_id|><|start_header_id|>assistant"
                "<|end_header_id|>\n\n",
        "stop": ["<|eot_id|>"],
    },
    "chatml": {
        "system": "<|im_start|>system\n{system}<|im_end|>\n",
        "turn": "<|im_start|>user\n{user}<|im_end|>\n"
                "<|im_start|>assistant\n",
        "stop": ["<|im_end|>"],
    },
    "llama": {                       # llama-2 [INST] style: the system
        "system": "",                # prompt folds into the first [INST]
        "first_turn": "[INST] <<SYS>>\n{system}\n<</SYS>>\n\n"
                      "{user} [/INST]",
        "turn": "[INST] {user} [/INST]",
        "stop": ["[INST]"],
    },
    "mistral": {
        "system": "<s>",
        "turn": "[INST] {user} [/INST]",
        "stop": ["[INST]", "</s>"],
    },
    "gemma": {
        "system": "<bos>",           # gemma has no system role
        "turn": "<start_of_turn>user\n{user}<end_of_turn>\n"
                "<start_of_turn>model\n",
        "stop": ["<end_of_turn>"],
    },
    "phi3": {
        "system": "<|system|>\n{system}<|end|>\n",
        "turn": "<|user|>\n{user}<|end|>\n<|assistant|>\n",
        "stop": ["<|end|>"],
    },
    "cohere": {
        "system": "<BOS_TOKEN><|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>"
                  "{system}<|END_OF_TURN_TOKEN|>",
        "turn": "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>{user}"
                "<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|>"
                "<|CHATBOT_TOKEN|>",
        "stop": ["<|END_OF_TURN_TOKEN|>"],
    },
    "granite": {
        "system": "System:\n{system}\n\n",
        "turn": "Question:\n{user}\n\nAnswer:\n",
        "stop": ["Question:"],
    },
    "deepseek": {
        "system": "{system}\n\n",
        "turn": "User: {user}\n\nAssistant:",
        "stop": ["User:"],
    },
}


def main():
    ap = argparse.ArgumentParser()
    from exllamav2_tpu import model_init
    model_init.add_args(ap)
    ap.add_argument("-mode", choices=list(PROMPT_FORMATS), default="raw")
    ap.add_argument("-sp", "--system_prompt",
                    default="You are a helpful assistant.")
    ap.add_argument("-temp", type=float, default=0.8)
    ap.add_argument("-maxr", "--max_response_tokens", type=int, default=512)
    args = ap.parse_args()

    model, tokenizer, generator = model_init.init(args)
    fmt = PROMPT_FORMATS[args.mode]

    from exllamav2_tpu.generator.dynamic import DynamicJob
    from exllamav2_tpu.generator.sampler import Settings
    settings = Settings(temperature=args.temp, top_p=0.9,
                        token_repetition_penalty=1.05)

    context = fmt["system"].format(system=args.system_prompt)
    print(" -- chat ready; Ctrl-C to exit")
    first = True
    while True:
        try:
            user = input("\nYou: ")
        except (KeyboardInterrupt, EOFError):
            print()
            break
        turn = fmt.get("first_turn", fmt["turn"]) if first else fmt["turn"]
        first = False
        context += turn.format(user=user, system=args.system_prompt)
        job = generator.enqueue(DynamicJob(
            tokenizer.encode(context),
            max_new_tokens=args.max_response_tokens,
            settings=settings, stop_conditions=list(fmt["stop"])))
        print("Bot: ", end="", flush=True)
        reply = ""
        while job.status != "done":
            for r in generator.iterate():
                if r.get("serial") == id(job):
                    chunk = r.get("text", "")
                    reply += chunk
                    print(chunk, end="", flush=True)
        print()
        context += reply + (fmt["stop"][0] if args.mode != "raw" else "\n")


if __name__ == "__main__":
    main()
