"""Chat template rendering for the common template families.

Re-implements the capability of the reference's template engine
(reference src/tokenizer/tokenizer.cpp:74-346): the template *string*
from tokenizer metadata is fingerprinted to a known family, then the
prompt is built programmatically. Families covered: chatml, llama2/
mistral, llama3, phi3, zephyr, gemma, deepseek, vicuna.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class ChatMessage:
    role: str  # "system" | "user" | "assistant"
    content: str


def detect_template(template: str) -> str:
    t = template or ""
    if "<|im_start|>" in t or t == "chatml":
        return "chatml"
    if "<|start_header_id|>" in t and "<|end_header_id|>" in t or t == "llama3":
        return "llama3"
    if "[INST]" in t or t in ("llama2", "mistral"):
        return "llama2"
    if "<|assistant|>" in t and "<|end|>" in t or t == "phi3":
        return "phi3"
    if "<|user|>" in t or t == "zephyr":
        return "zephyr"
    if "<start_of_turn>" in t or t in ("gemma", "gemma2"):
        return "gemma"
    if "### Instruction:" in t and "<|EOT|>" in t or t == "deepseek":
        return "deepseek"
    if "USER: " in t and "ASSISTANT: " in t or t.startswith("vicuna"):
        return "vicuna"
    return "chatml"  # safest modern default


def apply_chat_template(messages: list[ChatMessage] | list[dict],
                        template: str = "chatml",
                        add_assistant_prompt: bool = True) -> str:
    """Render a conversation; template may be a family name or the raw
    template string from tokenizer metadata (auto-detected)."""
    msgs = [ChatMessage(m["role"], m["content"]) if isinstance(m, dict) else m
            for m in messages]
    family = template if template in (
        "chatml", "llama2", "llama3", "phi3", "zephyr", "gemma", "deepseek",
        "vicuna") else detect_template(template)

    out: list[str] = []
    if family == "chatml":
        for m in msgs:
            out.append(f"<|im_start|>{m.role}\n{m.content}<|im_end|>\n")
        if add_assistant_prompt:
            out.append("<|im_start|>assistant\n")
    elif family == "llama3":
        for m in msgs:
            out.append(f"<|start_header_id|>{m.role}<|end_header_id|>\n\n"
                       f"{m.content.strip()}<|eot_id|>")
        if add_assistant_prompt:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    elif family == "llama2":
        system = ""
        first_user = True
        for m in msgs:
            if m.role == "system":
                system = m.content
            elif m.role == "user":
                content = m.content
                if system and first_user:
                    content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                    first_user = False
                out.append(f"[INST] {content} [/INST]")
            elif m.role == "assistant":
                out.append(f" {m.content} ")
    elif family == "phi3":
        for m in msgs:
            out.append(f"<|{m.role}|>\n{m.content}<|end|>\n")
        if add_assistant_prompt:
            out.append("<|assistant|>\n")
    elif family == "zephyr":
        for m in msgs:
            out.append(f"<|{m.role}|>\n{m.content}<|endoftext|>\n")
        if add_assistant_prompt:
            out.append("<|assistant|>\n")
    elif family == "gemma":
        for m in msgs:
            role = "model" if m.role == "assistant" else "user"
            # gemma has no system role; fold it into the user turn
            out.append(f"<start_of_turn>{role}\n{m.content.strip()}<end_of_turn>\n")
        if add_assistant_prompt:
            out.append("<start_of_turn>model\n")
    elif family == "deepseek":
        for m in msgs:
            if m.role == "system":
                out.append(m.content)
            elif m.role == "user":
                out.append(f"### Instruction:\n{m.content}\n")
            else:
                out.append(f"### Response:\n{m.content}\n<|EOT|>\n")
        if add_assistant_prompt:
            out.append("### Response:\n")
    elif family == "vicuna":
        for m in msgs:
            if m.role == "system":
                out.append(f"{m.content}\n\n")
            elif m.role == "user":
                out.append(f"USER: {m.content}\n")
            else:
                out.append(f"ASSISTANT: {m.content}</s>\n")
        if add_assistant_prompt:
            out.append("ASSISTANT:")
    return "".join(out)
